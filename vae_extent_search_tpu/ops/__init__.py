from .kcenter import k_center_greedy_blocked, min_dists_to_centers
