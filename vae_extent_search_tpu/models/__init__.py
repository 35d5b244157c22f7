from . import metrics
from .predictor import (
    PredictorConfig,
    fit_predictor,
    compute_total_loss,
    init_predictor_params,
    load_pretrained_encoder,
    make_predictor_optimizer,
    mc_predict,
    pred_encode,
    pred_forward,
    predict_cost,
    train_predictor,
)
from .segment import (
    eval_segment_vae,
    search_segment_vae_hyperparams,
)
from .vae import (
    init_vae_params,
    kld_loss,
    reparameterize,
    train_vae,
    vae_decode,
    vae_encode,
    vae_forward,
    vae_loss,
)
