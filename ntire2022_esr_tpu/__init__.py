"""NTIRE2022-ESR-TPU: a TPU-native efficient super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the NTIRE 2022 Efficient
Super-Resolution challenge harness (reference: ofsoundof/NTIRE2022_ESR).
All models are functional (param-pytree + pure apply), NHWC layout, and run
under jit on TPU; the evaluation harness, metrics, checkpoint porter and
model zoo registry live in subpackages:

- ``ops``      : conv / activation / resize / attention primitives (+ Pallas kernels)
- ``models``   : shared block library + the 40+ model zoo graph definitions
- ``porter``   : PyTorch .pth/.pt checkpoint -> NHWC/HWIO pytree conversion
- ``harness``  : model registry, eval loop, PSNR/SSIM, tiling, results writers
- ``parallel`` : device-mesh sharded (data-parallel) batch evaluation
- ``utils``    : host-side image I/O and logging
"""

__version__ = "0.1.0"

from ntire2022_esr_tpu import config  # noqa: F401
