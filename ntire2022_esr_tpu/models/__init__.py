from ntire2022_esr_tpu.models import blocks  # noqa: F401
