"""Precision policy.

The reference casts the whole model to bf16 on CUDA and wraps forward in
bf16 autocast (train_gpt2.py:238-239,263-264,463). The TPU-native policy is
stronger: parameters and optimizer state stay fp32, matmuls run in bf16 on
the MXU with fp32 accumulation (`preferred_element_type`), and layernorm /
softmax / loss run in fp32. Parity with the reference is therefore defined
at fp32 weights + bf16 compute and tolerance-tested.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_accum(self, x):
        return x.astype(self.accum_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_for_tests() -> Policy:
    """fp32 everywhere: used for logit-parity tests vs the fp32 reference."""
    return FP32_POLICY
