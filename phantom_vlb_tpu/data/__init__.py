from phantom_vlb_tpu.data.hrf import get_hrf_weight, get_hrf_weights, glover_hrf

__all__ = ["get_hrf_weight", "get_hrf_weights", "glover_hrf"]
