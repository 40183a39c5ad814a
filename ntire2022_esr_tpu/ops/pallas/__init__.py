from ntire2022_esr_tpu.ops.pallas.conv_chain import fused_conv3x3_chain  # noqa: F401
