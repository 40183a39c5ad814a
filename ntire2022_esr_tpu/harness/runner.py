"""Per-model evaluation loop (reference test_demo.run, test_demo.py:394-477).

TPU-native differences from the reference:
- the forward is jitted once per input shape (XLA compile cache); timing
  wraps the device call with a D2H fence (harness.profiling.fence) — the
  analogue of the reference's CUDA-event pair around the model forward
  only (``block_until_ready`` does not synchronize tunnelled backends);
- image decode of the *next* image overlaps the current device compute via
  a background prefetch thread (host->HBM transfer is started eagerly with
  ``jax.device_put``);
- device memory is reported from JAX device memory stats.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from queue import Queue
from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from ntire2022_esr_tpu.harness import data as data_mod
from ntire2022_esr_tpu.harness import tiling
from ntire2022_esr_tpu.harness.profiling import fence
from ntire2022_esr_tpu.utils import image as img_util
from ntire2022_esr_tpu.utils import metrics


def _prefetch(pairs, data_range: float, q: Queue) -> None:
    # A decode failure must reach the consumer: without the sentinel the
    # eval loop would block on q.get() forever, so ship the exception itself.
    try:
        for lr_path, hr_path in pairs:
            lr = img_util.imread_uint(lr_path, n_channels=3)
            x = img_util.uint2nhwc(lr, data_range)
            dev_x = jax.device_put(x)
            q.put((lr_path, hr_path, dev_x))
    except BaseException as exc:  # noqa: BLE001 - relayed to the main thread
        q.put(exc)
    else:
        q.put(None)


def run(
    apply: Callable,
    params,
    model_name: str,
    data_range: float,
    tile: Optional[int],
    logger: logging.Logger,
    args,
    mode: str = "test",
    pairs: Optional[List[Tuple[str, str]]] = None,
    spatial_mesh=None,
    spatial_overlap: int = 32,
    max_tiles_per_call: int = 16,
) -> Dict:
    sf = 4
    border = sf
    results: Dict = {f"{mode}_runtime": [], f"{mode}_psnr": []}
    if getattr(args, "ssim", False):
        results[f"{mode}_ssim"] = []

    if pairs is None:
        pairs = data_mod.select_dataset(args.data_dir, mode)
    save_path = os.path.join(args.save_dir, model_name, "test" if mode == "test" else "valid")
    img_util.mkdir(save_path)

    device_params = jax.device_put(params)
    jitted = jax.jit(lambda p, x: tiling.forward(
        apply, p, x, tile, max_tiles_per_call=max_tiles_per_call))

    # Optional H-slab spatial sharding over a device mesh (exact for
    # local-conv models when `spatial_overlap` covers the receptive field;
    # see parallel/spatial.py — arbitrary H handled by the windowed
    # scheme). Images too small to shard fall back to the single-device
    # forward with a logged decision (once per shape).
    spatial_fn = None
    if spatial_mesh is not None and tile is None:
        from ntire2022_esr_tpu.parallel.spatial import (
            SpatialShardUnavailable, make_spatial_apply)

        spatial_fn = make_spatial_apply(apply, spatial_mesh, overlap=spatial_overlap)
    _spatial_warned = set()

    def forward(x):
        if spatial_fn is not None:
            # only the explicit cannot-shard-this-shape condition falls
            # back; any other error from the sharded forward propagates
            try:
                return spatial_fn(device_params, x)
            except SpatialShardUnavailable as exc:
                if x.shape not in _spatial_warned:
                    _spatial_warned.add(x.shape)
                    logger.info(
                        f"spatial sharding unavailable for shape {x.shape} "
                        f"({exc}); using single-device forward")
        return jitted(device_params, x)

    q: Queue = Queue(maxsize=2)
    t = threading.Thread(target=_prefetch, args=(pairs, data_range, q), daemon=True)
    t.start()
    warmed_shapes: set = set()

    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        lr_path, hr_path, dev_x = item
        img_name, ext = os.path.splitext(os.path.basename(hr_path))

        # compile outside the timed region (the reference times a warm CUDA
        # graph; first-call XLA compilation is not model runtime), but only
        # on the FIRST sighting of each input shape — the jit cache makes
        # later same-shape calls warm already, and re-warming per image
        # would double the device work of the whole protocol. The fence is
        # a D2H read: block_until_ready does not synchronize tunnelled
        # backends, so timing with it would measure dispatch, not compute.
        if dev_x.shape not in warmed_shapes:
            fence(forward(dev_x))
            warmed_shapes.add(dev_x.shape)
        t0 = time.perf_counter()
        sr = forward(dev_x)
        fence(sr)
        elapsed_ms = (time.perf_counter() - t0) * 1000.0
        results[f"{mode}_runtime"].append(elapsed_ms)

        sr_u8 = img_util.nhwc2uint(np.asarray(sr), data_range)

        hr = img_util.imread_uint(hr_path, n_channels=3)
        hr = img_util.modcrop(np.squeeze(hr), sf)

        psnr = metrics.calculate_psnr(sr_u8, hr, border=border)
        results[f"{mode}_psnr"].append(psnr)
        if getattr(args, "ssim", False):
            ssim = metrics.calculate_ssim(sr_u8, hr, border=border)
            results[f"{mode}_ssim"].append(ssim)
            logger.info(f"{img_name}{ext} - PSNR: {psnr:.2f} dB; SSIM: {ssim:.4f}.")
        else:
            logger.info(f"{img_name}{ext} - PSNR: {psnr:.2f} dB")

        img_util.imsave(sr_u8, os.path.join(save_path, img_name[:4] + ext))

    results[f"{mode}_memory"] = _device_memory_mb()
    results[f"{mode}_ave_runtime"] = sum(results[f"{mode}_runtime"]) / len(results[f"{mode}_runtime"])
    results[f"{mode}_ave_psnr"] = sum(results[f"{mode}_psnr"]) / len(results[f"{mode}_psnr"])
    if getattr(args, "ssim", False):
        results[f"{mode}_ave_ssim"] = sum(results[f"{mode}_ssim"]) / len(results[f"{mode}_ssim"])
    logger.info("{:>16s} : {:<.3f} [M]".format("Max Memory", results[f"{mode}_memory"]))
    logger.info(
        "------> Average runtime of ({}) is : {:.6f} milliseconds".format(
            "test" if mode == "test" else "valid", results[f"{mode}_ave_runtime"]
        )
    )
    return results


def _device_memory_mb() -> float:
    """Peak device memory in MB (jax memory_stats; 0.0 when unavailable, e.g. CPU)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 1024**2
    except Exception:
        pass
    return 0.0


def run_batched(
    apply: Callable,
    params,
    model_name: str,
    data_range: float,
    logger: logging.Logger,
    args,
    mode: str = "test",
    pairs: Optional[List[Tuple[str, str]]] = None,
    mesh=None,
    u8_io: bool = False,
    spatial_overlap: int = 32,
) -> Dict:
    """Shape-bucketed batched evaluation (throughput path).

    DIV2K images come in a handful of distinct LR shapes; the reference
    evaluates them one by one (batch 1). Here images are grouped by exact
    (H, W), stacked into one batch per bucket, and run through a single
    jitted call per shape — one compile per bucket, full MXU batch
    utilisation, and optional mesh sharding of the batch axis.

    Timing is per *batch* and attributed evenly to its images, matching the
    reference's model-forward-only protocol in aggregate.

    ``u8_io=True`` moves the uint8<->float boundary onto the device
    (uint2nhwc / nhwc2uint semantics in-graph, same expressions): H2D and
    D2H shrink 4x — the serving configuration bench.py times. Outputs can
    differ from the host conversion by round-tie ulp flips only; keep the
    default for strict protocol artifacts.
    """
    sf = 4
    border = sf
    results: Dict = {f"{mode}_runtime": [], f"{mode}_psnr": []}
    if getattr(args, "ssim", False):
        results[f"{mode}_ssim"] = []

    if pairs is None:
        pairs = data_mod.select_dataset(args.data_dir, mode)
    save_path = os.path.join(args.save_dir, model_name, "test" if mode == "test" else "valid")
    img_util.mkdir(save_path)

    # decode + bucket on host
    buckets: Dict[Tuple[int, int], List[Tuple[str, str, np.ndarray]]] = {}
    for lr_path, hr_path in pairs:
        lr = img_util.imread_uint(lr_path, n_channels=3)
        buckets.setdefault(lr.shape[:2], []).append((lr_path, hr_path, lr))

    device_params = jax.device_put(params)
    if u8_io:
        import jax.numpy as jnp

        def apply_u8(p, u8):
            x = u8.astype(jnp.float32) / (255.0 / data_range)
            y = apply(p, x)
            y = jnp.clip(y, 0, data_range) * (255.0 / data_range)
            return jnp.round(y).astype(jnp.uint8)

        device_fn = apply_u8
    else:
        device_fn = apply
    pad_to = 0
    if mesh is not None and "space" in mesh.shape:
        # 2-D (data, space) mesh: batch-parallel groups of H-slab shards —
        # the composed path behind `--batched --spatial --mesh N`. The u8
        # wrapper stays slab-exact (pointwise conversions). The batch pads
        # to the DATA axis only; H-shardability is per shape
        # (halo/windowed, parallel/spatial.py).
        from ntire2022_esr_tpu.parallel.spatial import make_spatial_apply

        jitted = make_spatial_apply(device_fn, mesh, overlap=spatial_overlap,
                                    axis="space", batch_axis="data")
        pad_to = mesh.shape["data"]
    elif mesh is not None:
        from ntire2022_esr_tpu.parallel import sharded_batch_apply

        jitted = sharded_batch_apply(device_fn, mesh)
        pad_to = mesh.devices.size
    else:
        jitted = jax.jit(device_fn)

    per_image: Dict[str, Tuple[np.ndarray, str]] = {}
    for shape, items in sorted(buckets.items()):
        if u8_io:
            batch = np.stack([lr for _, _, lr in items])
        else:
            batch = np.stack([img_util.uint2nhwc(lr, data_range)[0] for _, _, lr in items])
        if pad_to:
            pad = (-len(items)) % pad_to
            if pad:
                batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        dev_batch = jax.device_put(batch)
        fence(jitted(device_params, dev_batch))  # compile outside timing
        t0 = time.perf_counter()
        out = jitted(device_params, dev_batch)
        fence(out)
        elapsed_ms = (time.perf_counter() - t0) * 1000.0
        sr = np.asarray(out)[: len(items)]
        # attribute per-SLOT time: mesh-divisibility padding slots run the
        # same compute as real images, so elapsed/len(batch) is the true
        # per-image device rate at this batch shape — charging the padded
        # slots' compute to the real images would inflate their time
        # whenever len(items) % pad_to != 0
        per_img_ms = elapsed_ms / len(batch)
        for k, (lr_path, hr_path, _) in enumerate(items):
            results[f"{mode}_runtime"].append(per_img_ms)
            per_image[hr_path] = (sr[k], lr_path)

    for lr_path, hr_path in pairs:
        sr_arr, _ = per_image[hr_path]
        img_name, ext = os.path.splitext(os.path.basename(hr_path))
        sr_u8 = sr_arr if u8_io else img_util.nhwc2uint(sr_arr, data_range)
        hr = img_util.modcrop(np.squeeze(img_util.imread_uint(hr_path, n_channels=3)), sf)
        psnr = metrics.calculate_psnr(sr_u8, hr, border=border)
        results[f"{mode}_psnr"].append(psnr)
        if getattr(args, "ssim", False):
            results[f"{mode}_ssim"].append(metrics.calculate_ssim(sr_u8, hr, border=border))
        logger.info(f"{img_name}{ext} - PSNR: {psnr:.2f} dB")
        img_util.imsave(sr_u8, os.path.join(save_path, img_name[:4] + ext))

    results[f"{mode}_memory"] = _device_memory_mb()
    results[f"{mode}_ave_runtime"] = sum(results[f"{mode}_runtime"]) / len(results[f"{mode}_runtime"])
    results[f"{mode}_ave_psnr"] = sum(results[f"{mode}_psnr"]) / len(results[f"{mode}_psnr"])
    if getattr(args, "ssim", False):
        results[f"{mode}_ave_ssim"] = sum(results[f"{mode}_ssim"]) / len(results[f"{mode}_ssim"])
    logger.info(
        "------> Average runtime of ({}) is : {:.6f} milliseconds (shape-bucketed)".format(
            "test" if mode == "test" else "valid", results[f"{mode}_ave_runtime"]
        )
    )
    return results
