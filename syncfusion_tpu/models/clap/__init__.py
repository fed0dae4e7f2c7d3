"""CLAP (Contrastive Language-Audio Pretraining), LAION variant.

The reference conditions diffusion on CLAP embeddings
(``laion_clap.CLAP_Module(enable_fusion=False, amodel='HTSAT-tiny')``,
exp/model/diffusion.yaml:45-49, checkpoint ``630k-audioset-best.pt``).
This package is a TPU-native re-implementation: HTSAT-tiny (Swin audio
transformer) + RoBERTa-base text tower + projection heads, with converters
for the public checkpoint.
"""

from syncfusion_tpu.models.clap.model import ClapModel, ClapEmbedder
