from .bp2 import bp2_decode, BP2Result
from .bp4 import bp4_decode, BP4Result, quaternary_to_binary_llrs, hard_decision
from .cn_update import cn_update_phi, cn_update_tanh, cn_update_minsum, boxplus_rows, phi
from .gnn_feedback import (
    init_feedback_gnn,
    feedback_gnn_apply,
    load_reference_weights,
    save_reference_weights,
)
from .cascade import CascadeConfig, sandwich_decode, sandwich_eval_step, prior_llr
