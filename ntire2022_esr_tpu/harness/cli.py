"""CLI batch driver — the TPU-native `test_demo.py` (reference :480-577).

    python -m ntire2022_esr_tpu.harness.cli --data_dir D --save_dir S \
        --model_id N [--include_test] [--ssim] [--mode parity|high|mixed|fast] \
        [--batched] [--mesh N] [--spatial] [--space S] [--x8]

``--batched --spatial --mesh N`` composes both parallelism axes on a 2-D
(data, space) mesh: N/S batch-parallel groups, each H-slab sharded S ways
with halo exchange (slab-safe models only).

Evaluates one zoo model on DIV2K val (optionally test), accumulates
results.json / results.txt in the cwd, and logs per-image PSNR. A failed
model never kills a sweep (per-model try/except in `sweep`).
"""

from __future__ import annotations

import argparse
import logging
import os
from pprint import pprint

from ntire2022_esr_tpu import config
from ntire2022_esr_tpu.harness import registry, results as results_mod, runner, summary
from ntire2022_esr_tpu.utils import logger as logger_mod


def evaluate_model(model_id: int, args, logger: logging.Logger) -> dict:
    apply, params, model_name, data_range, tile = registry.build_model(model_id)
    logger.info(model_name)

    if getattr(args, "x8", False):
        from ntire2022_esr_tpu.harness.ensemble import self_ensemble_x8

        apply = self_ensemble_x8(apply)
        model_name = model_name + "_x8"

    mesh = None
    if getattr(args, "spatial", False):
        # refuse silently-unsharded configurations: --spatial needs a mesh
        if not getattr(args, "mesh", 0):
            raise ValueError("--spatial requires --mesh N")
    if getattr(args, "mesh", 0):
        from ntire2022_esr_tpu.parallel import data_space_mesh, make_mesh

        if getattr(args, "spatial", False) and getattr(args, "batched", False):
            # composed 2-D (data, space) mesh: batch-parallel groups of
            # H-slab shards — big-tail models use N chips as (N/space, space)
            # without choosing one axis (parallel/spatial.py batch_axis)
            space = getattr(args, "space", 2) or 2
            if args.mesh % space:
                raise ValueError(f"--mesh {args.mesh} must divide by "
                                 f"--space {space} for the composed path")
            mesh = data_space_mesh(args.mesh // space, space)
        else:
            mesh = make_mesh(args.mesh)

    def _pairs(mode):
        # tolerate partial datasets (the reference hard-codes 100 ids and
        # crashes on gaps); the runners stay strict on explicit pairs
        from ntire2022_esr_tpu.harness import data as data_mod

        sel = data_mod.select_dataset(args.data_dir, mode)
        found = [(l, h) for l, h in sel
                 if os.path.exists(l) and os.path.exists(h)]
        if not found:
            raise FileNotFoundError(
                f"no {mode} LR images under {args.data_dir} (expected e.g. {sel[0][0]})")
        if len(found) < len(sel):
            logger.info(f"{mode}: {len(found)}/{len(sel)} images present")
        return found

    if getattr(args, "batched", False) and tile is None:
        u8_io = getattr(args, "u8_io", False)
        spec = registry.get_spec(model_id)
        if mesh is not None and "space" in mesh.shape and not spec.slab_safe:
            raise ValueError(
                f"model {model_id} ({model_name}) is not slab-decomposable; "
                "the composed --batched --spatial path needs slab_safe models "
                "— use plain --batched --mesh N instead")
        entry = runner.run_batched(apply, params, model_name, data_range, logger, args,
                                   mode="valid", mesh=mesh, u8_io=u8_io,
                                   spatial_overlap=spec.halo, pairs=_pairs("valid"))
        if args.include_test:
            entry.update(runner.run_batched(apply, params, model_name, data_range, logger, args,
                                            mode="test", mesh=mesh, u8_io=u8_io,
                                            spatial_overlap=spec.halo,
                                            pairs=_pairs("test")))
    else:
        spatial_mesh = mesh if getattr(args, "spatial", False) else None
        spec = registry.get_spec(model_id)
        overlap = spec.halo
        if spatial_mesh is not None and not spec.slab_safe:
            # H-slab sharding is exact only for translation-invariant bounded-
            # receptive-field models (ModelSpec.slab_safe); refuse rather than
            # silently compute wrong pixels near slab boundaries.
            raise ValueError(
                f"model {model_id} ({model_name}) is not slab-decomposable "
                "(pooling-grid / global ops); use --batched --mesh N instead")
        entry = runner.run(apply, params, model_name, data_range, tile, logger, args,
                           mode="valid", spatial_mesh=spatial_mesh, spatial_overlap=overlap,
                           max_tiles_per_call=spec.max_tiles_per_call, pairs=_pairs("valid"))
        if args.include_test:
            entry.update(runner.run(apply, params, model_name, data_range, tile, logger, args,
                                    mode="test", spatial_mesh=spatial_mesh, spatial_overlap=overlap,
                                    max_tiles_per_call=spec.max_tiles_per_call,
                                    pairs=_pairs("test")))

    # runtime memory_stats are unavailable on some backends (axon tunnel):
    # fall back to the compiled executable's static memory analysis at the
    # challenge shape so the Mem column is never silently zero
    if any(entry.get(key) == 0.0 for key in ("valid_memory", "test_memory")):
        mem = summary.compiled_memory_mb(apply, params, (256, 256))
        if mem == 0.0:
            logger.info("Mem column unavailable: runtime memory_stats absent "
                        "and static memory analysis failed")
        for key in ("valid_memory", "test_memory"):
            if entry.get(key) == 0.0:
                entry[key] = mem

    comp = summary.model_complexity(
        apply, params, (256, 256),
        params_convention=getattr(args, "params_convention", "deploy"),
        model_name=model_name)
    logger.info("{:>16s} : {:<.4f} [M]".format("#Activations", comp["activations"]))
    logger.info("{:>16s} : {:<d}".format("#Conv2d", comp["num_conv"]))
    logger.info("{:>16s} : {:<.4f} [G]".format("FLOPs", comp["flops"]))
    logger.info("{:>16s} : {:<.4f} [M]".format("#Params", comp["num_parameters"]))
    entry.update(comp)
    return model_name, entry


def main(argv=None):
    parser = argparse.ArgumentParser("NTIRE2022-EfficientSR-TPU")
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--save_dir", default="./sr_results", type=str)
    parser.add_argument("--model_id", default=0, type=int, nargs="+")
    parser.add_argument("--include_test", action="store_true", help="Inference on the DIV2K test set")
    parser.add_argument("--ssim", action="store_true", help="Calculate SSIM")
    parser.add_argument("--mode", default="parity", choices=["parity", "high", "mixed", "fast"],
                        help="numerics: parity=f32/HIGHEST (reference-exact), high=f32/bf16x3 "
                             "(strict-parity speed mode), mixed=bf16 MXU/f32 act, fast=bf16")
    parser.add_argument("--batched", action="store_true",
                        help="shape-bucketed batched evaluation (throughput path)")
    parser.add_argument("--u8_io", action="store_true",
                        help="with --batched: uint8 device boundary (4x smaller "
                             "H2D/D2H; output may differ by round-tie ulp flips)")
    parser.add_argument("--mesh", default=0, type=int, metavar="N",
                        help="shard over the first N devices (with --batched: data-parallel "
                             "batch; with --spatial: H-slab shard per image)")
    parser.add_argument("--spatial", action="store_true",
                        help="H-slab spatial sharding with halo exchange (needs --mesh N); "
                             "with --batched: composed 2-D (data, space) mesh")
    parser.add_argument("--space", default=2, type=int, metavar="S",
                        help="space-axis width of the composed --batched --spatial "
                             "mesh (mesh = (N/S, S); default 2)")
    parser.add_argument("--x8", action="store_true",
                        help="x8 dihedral self-ensemble inference")
    parser.add_argument("--params_convention", default="deploy",
                        choices=["deploy", "reference"],
                        help="#Params counting: 'deploy' = the folded params "
                             "actually stored; 'reference' = add back the "
                             "weight-norm g vectors the porter folds (matches "
                             "the published table for models 23/36/42)")
    args = parser.parse_args(argv)
    pprint(args)

    config.set_mode(args.mode)
    logger_mod.logger_info("NTIRE2022-EfficientSR", log_path="NTIRE2022-EfficientSR.log")
    logger = logging.getLogger("NTIRE2022-EfficientSR")

    json_dir = os.path.join(os.getcwd(), "results.json")
    results = results_mod.load_results(json_dir)

    ids = args.model_id if isinstance(args.model_id, list) else [args.model_id]
    for model_id in ids:
        try:
            model_name, entry = evaluate_model(model_id, args, logger)
            results[model_name] = entry
            results_mod.save_results(json_dir, results)
        except Exception:
            logger.exception(f"model {model_id} failed; continuing sweep")

    results_mod.write_table(os.path.join(os.getcwd(), "results.txt"), results, args.include_test)


if __name__ == "__main__":
    main()
