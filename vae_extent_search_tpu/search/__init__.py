from .active_loop import (
    ActiveSearchResult,
    pretrain_pool_vae,
    run_active_search,
    standardize,
)
from .select import (
    SelectionConfig,
    farthest_point_init,
    k_center_greedy,
    l2_normalize,
    masked_top_k,
    pairwise_dist,
    random_select,
    select_programs,
    z_grad_norms,
)
