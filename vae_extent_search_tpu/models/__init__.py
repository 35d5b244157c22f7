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


def load_model_pickle(path: str):
    """Load ANY saved cost-model internal by sniffing the pickle blob —
    the reference's eval scripts take a model file of whatever family
    train_model produced (mlp/xgb/lgbm/tabnet/...), so consumers must
    not hardcode one loader. Tree internals pickle themselves; the JAX
    models save dict blobs distinguished by their keys."""
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    if not isinstance(blob, dict):
        return blob                    # pickled internal (GBDT/LGB)
    if "vae_params" in blob:
        from .segment import SegmentVAEModelInternal

        return SegmentVAEModelInternal.load(path)
    if "arch" in blob:
        from .variants import SequenceModelInternal

        return SequenceModelInternal.load(path)
    from .segment import MLPModelInternal

    return MLPModelInternal.load(path)
