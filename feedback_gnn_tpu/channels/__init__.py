from .pauli import pauli_iid, pauli_fixed_weight, depolarizing_probs
from .bsc import bsc_sample, bsc_sample_ste, binary_source
