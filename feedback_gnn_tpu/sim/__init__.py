from .metrics import (
    count_errors,
    count_block_errors,
    compute_ber,
    compute_bler,
    hard_decisions,
)
from .montecarlo import sim_ler, SimResult
from .plotting import PlotLER
