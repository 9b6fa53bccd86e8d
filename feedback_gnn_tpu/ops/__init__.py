from .gf2mat import mod2_matmul, int_mod_2
from .dense import dense_bl, mlp_bl, init_dense, init_mlp
