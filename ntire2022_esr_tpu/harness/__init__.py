from ntire2022_esr_tpu.harness import data, registry, results, runner, summary, tiling  # noqa: F401
