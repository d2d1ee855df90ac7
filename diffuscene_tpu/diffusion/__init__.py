from .schedule import DiffusionSchedule, get_betas, make_schedule, schedule_from_betas, extract
from .gaussian import (
    AttributeSpec,
    LossConfig,
    ModelPrediction,
    model_predictions,
    normal_kl,
    p_losses,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_v,
    predict_xstart_from_eps,
    predict_xstart_from_v,
    prior_bpd,
    q_mean_variance,
    q_posterior_mean_variance,
    q_sample,
    vb_terms_bpd,
    iou_regularizer,
    descale_to_origin,
)
from .samplers import (
    ddim_sample_loop,
    p_sample_loop,
    p_sample_loop_arrange,
    p_sample_loop_complete,
    p_sample_loop_trajectory,
    p_sample_step,
)
