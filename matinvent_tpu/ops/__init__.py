from matinvent_tpu.ops.lattice import (
    lattice_params_to_matrix,
    lattice_matrix_to_params,
    frac_to_cart,
    cart_to_frac,
)
from matinvent_tpu.ops.wrapped_normal import (
    p_wrapped_normal,
    d_log_p_wrapped_normal,
    log_prob_wrapped_normal,
    sigma_norm,
)
from matinvent_tpu.ops.schedules import BetaSchedule, SigmaSchedule
from matinvent_tpu.ops.segment import masked_mean, graph_mean

__all__ = [
    "lattice_params_to_matrix",
    "lattice_matrix_to_params",
    "frac_to_cart",
    "cart_to_frac",
    "p_wrapped_normal",
    "d_log_p_wrapped_normal",
    "log_prob_wrapped_normal",
    "sigma_norm",
    "BetaSchedule",
    "SigmaSchedule",
    "masked_mean",
    "graph_mean",
]
