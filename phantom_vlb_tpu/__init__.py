"""phantom_vlb_tpu — TPU-native vision-language-brain (VLB) encoding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``courtois-neuromod/phantom_vlb`` (reference mounted at /root/reference):
fine-tuning a VideoLLaMA2-style multimodal model (CLIP ViT-L/14-336 vision
tower -> spatial-temporal "STC" connector -> Mistral-7B decoder) to predict
fMRI BOLD activity from the CNeuroMod *Friends* dataset.

Layer map (TPU-first; see SURVEY.md for the reference layer map):

- ``core``            config system, mesh/partitioning, dtype policy, PRNG.
- ``models``          Flax implementations: CLIP ViT, STC connector, Mistral,
                      the multimodal splice, LoRA, brain-readout heads.
- ``ops``             Pallas TPU kernels + XLA fallbacks (flash attention,
                      fused image preprocessing, HRF pooling).
- ``parallel``        GSPMD sharding rules over a ('data','fsdp','tensor') mesh.
- ``data``            HDF5 schema contracts, Glover-HRF numerics, feature
                      extraction, lazy-load dataset builder, prefetching loader.
- ``train``           jitted train/eval steps, loop, optax optimizers, Orbax
                      checkpointing, streaming Pearson metrics + CSV logging.
- ``postprocessing``  accuracy brain-map projection (atlas inverse transform).
- ``cli``             vlb-extract / vlb-build-lazyload / vlb-train /
                      vlb-brainmaps entry points mirroring the reference CLIs.
"""

from phantom_vlb_tpu.version import __version__

__all__ = ["__version__"]
