"""syncfusion_tpu — a TPU-native video-to-audio Foley synthesis framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
mcomunita/syncfusion (ICASSP 2024): an onset-detection video CNN, a 1-D
waveform v-diffusion model conditioned on onset tracks and CLAP embeddings,
and the CondFoleyGen (SpecVQGAN + GPT + MelGAN) baseline stack — plus the
training, generation and evaluation harnesses around them.

Design principles (TPU-first, not a port):
  * All compute paths are jittable pure functions over parameter pytrees.
  * Scaling is expressed with ``jax.sharding.Mesh`` + NamedSharding; XLA
    emits the collectives (psum over ICI), there is no NCCL-style code.
  * Static shapes everywhere; sampling loops are ``lax.scan``.
  * bfloat16 compute with float32 parameters/accumulation by default,
    switchable to full f32 for parity runs.
"""

__version__ = "0.1.0"
