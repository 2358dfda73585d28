"""TPU-native GPT-2 vision-language framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
PyTorch reference `theophile-lt/gpt2-vision-language`:

  * 124M GPT-2 decoder pretraining on FineWeb-Edu token shards
    (reference: source/gpt2/train_gpt2.py)
  * three frozen-backbone image-captioning bridges over precomputed CLIP
    patch tokens: linear projection (source/gpt2_linear/), tanh-gated
    in-block cross-attention (source/gpt2_cross-att/), and a BLIP-2-style
    Q-Former (source/gpt2_q_former/)
  * HellaSwag / val-loss / CIDEr / METEOR evaluation, sampling,
    CSV observability, atomic rolling checkpoints.

Design: pure-functional models over parameter pytrees, `lax.scan` over
stacked transformer layers, Pallas flash-attention + fused-AdamW kernels on
the hot path, SPMD data parallelism via `jax.sharding.Mesh` + jit.
"""

__version__ = "0.1.0"
