#!/usr/bin/env python
"""Generate docs/COMPLEXITY.md: challenge-style complexity table for the zoo."""
import os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ntire2022_esr_tpu.harness import registry, summary

    lines = [
        "# Model complexity (challenge protocol: 256x256 LR input)", "",
        "Measured from the lowered StableHLO (harness/summary.py). FLOPs are",
        "MACs (challenge convention) and include attention/linear matmuls the",
        "reference's hook counter misses; params follow torch parameters()",
        "semantics (weight-normed models differ by the folded g vectors).", "",
        "| model | #Params [M] | FLOPs [G] | #Acts [M] | #Conv |", "|---|---|---|---|---|",
    ]
    for mid in registry.available_ids():
        apply, params, name, dr, tile = registry.build_model(mid)
        c = summary.model_complexity(apply, params, (256, 256))
        lines.append(f"| {name} | {c['num_parameters']:.3f} | {c['flops']:.2f} | "
                     f"{c['activations']:.2f} | {c['num_conv']} |")
        print(lines[-1], flush=True)
    open(os.path.join(REPO, "docs", "COMPLEXITY.md"), "w").write("\n".join(lines) + "\n")

if __name__ == "__main__":
    main()
