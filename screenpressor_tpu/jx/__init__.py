"""JAX/XLA implementation of the SPTC1 codec (TPU path).

Byte-identical to the numpy spec (`screenpressor_tpu.spec`); tests enforce
stream equality. Hot loops are `lax.scan`s whose bodies are K-lane-wide
vector work; analysis passes are fused elementwise/reduction tensor programs.
"""
