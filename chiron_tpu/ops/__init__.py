"""Pallas TPU kernels for the pair/force hot path.

The jnp/vmap implementations in ``chiron_tpu.neighbors`` /
``chiron_tpu.potential`` are the semantic oracles; the kernels here are
drop-in accelerated equivalents used by the optimized runtime paths.
"""
