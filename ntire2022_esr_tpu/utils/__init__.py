from ntire2022_esr_tpu.utils import image, logger, metrics  # noqa: F401
