from gcge_tpu.io.fem import cube_fem_laplacian
from gcge_tpu.io.loaders import load_matrix_market, load_petsc_binary

__all__ = ["cube_fem_laplacian", "load_matrix_market", "load_petsc_binary"]
