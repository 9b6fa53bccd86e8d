from .pauli import pauli_iid, pauli_fixed_weight, depolarizing_probs
from .bsc import bsc_sample, bsc_sample_ste, binary_source
from .discrete import (
    binary_erasure_channel,
    binary_memoryless_channel,
    binary_symmetric_channel,
    binary_z_channel,
    sample_errors_gumbel,
    ste_binarize,
    xor_ste,
)
