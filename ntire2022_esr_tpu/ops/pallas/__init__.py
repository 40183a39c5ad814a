from ntire2022_esr_tpu.ops.pallas.conv_chain import fused_conv3x3_chain  # noqa: F401
from ntire2022_esr_tpu.ops.pallas.tail import fused_conv3x3_pixelshuffle  # noqa: F401
