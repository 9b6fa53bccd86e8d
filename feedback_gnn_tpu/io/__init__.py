from .checkpoint import save_pytree, load_pytree
