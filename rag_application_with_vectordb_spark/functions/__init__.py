from .vector import (  # noqa: F401
    as_double,
    cosine_sim,
    cosine_sim_prenormed,
    dot,
    l2_dist,
    l2_norm,
    vec_lit,
)
