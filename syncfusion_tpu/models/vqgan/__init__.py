"""SpecVQGAN: VQ-GAN over mel spectrograms (CondFoleyGen baseline stage 1).

Re-implementation of the reference's vendored taming-transformers stack
(CondFoleyGen/specvqgan): encoder/decoder conv towers, vector quantizer,
PatchGAN discriminator, LPAPS perceptual loss, and the two-optimizer GAN
training step with the adaptive discriminator weight.
"""

from syncfusion_tpu.models.vqgan.model import VQModel
from syncfusion_tpu.models.vqgan.quantize import VectorQuantizer
