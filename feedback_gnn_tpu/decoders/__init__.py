from .bp2 import bp2_decode, BP2Result
from .bp4 import bp4_decode, BP4Result, quaternary_to_binary_llrs, hard_decision
from .cn_update import cn_update_phi, cn_update_tanh, cn_update_minsum, boxplus_rows, phi
from .gnn_feedback import (
    init_feedback_gnn,
    feedback_gnn_apply,
    load_reference_weights,
    load_weights,
    save_reference_weights,
)
from .cascade import CascadeConfig, sandwich_decode, sandwich_eval_step, prior_llr
from .osd import osd0_decode, bp_osd_correct
from .gnn_full import GNNBP4Config, init_gnn_bp4, gnn_bp4_apply, gnn_bp4_loss, make_logit_rowsets
