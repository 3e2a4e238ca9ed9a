"""joliGEN-TPU: TPU-native (JAX/XLA/Pallas) image & video generative
training + inference framework with the capabilities of jolibrain/joliGEN.

Model families: GANs (CUT/CycleGAN), DDPM diffusion (Palette),
consistency/flow models (CM/ECT, shortcut, B2B flow matching), and
mask-aware inpainting transformers — with semantic-preserving losses,
online bbox-crop dataset creation, and a REST serving API.
"""

__version__ = "0.1.0"
