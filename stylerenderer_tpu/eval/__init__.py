from stylerenderer_tpu.eval.fid import (
    compute_fid,
    extract_features_from_dataset,
    extract_features_from_samples,
    feature_stats,
    frechet_distance,
    load_stats,
    save_stats,
)
from stylerenderer_tpu.eval.inception import InceptionV3, load_patched_inception_v3
from stylerenderer_tpu.eval.lpips import LPIPS, load_lpips
from stylerenderer_tpu.eval.ppl import (
    compute_ppl,
    lerp,
    make_ppl_sampler,
    ppl_filtered_mean,
    slerp,
)

__all__ = [
    "InceptionV3",
    "LPIPS",
    "compute_fid",
    "compute_ppl",
    "extract_features_from_dataset",
    "extract_features_from_samples",
    "feature_stats",
    "frechet_distance",
    "lerp",
    "load_lpips",
    "load_patched_inception_v3",
    "load_stats",
    "make_ppl_sampler",
    "ppl_filtered_mean",
    "save_stats",
    "slerp",
]
