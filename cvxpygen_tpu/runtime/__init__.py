from .jax_family import JaxFamily, canon_batch  # noqa: F401
