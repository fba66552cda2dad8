"""Pure-numpy executable specification of the SPTC1 format.

This package defines the format's behavior exactly (FORMAT.md) and doubles as
the host fallback codec. The JAX implementation (`screenpressor_tpu.jx`) must
produce byte-identical streams; tests enforce that.
"""
