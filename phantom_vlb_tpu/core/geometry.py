"""VLB sample geometry — the arithmetic contract shared by every stage.

The reference hard-codes a chain of numbers across three files
(extractfeatures.py:198-212, lazyloading.py:103-115, litmodule.py:178-203):
12 frames/sample, 169 tokens/frame, 7 downsampled frames, 866 text tokens,
2048 total.  Here the chain is derived once from first principles so tiny test
geometries obey the same invariants as the production one.

Derivations (for the defaults, matching the reference):

- ``num_frames``        = window * frames_per_tr            = 12
- ``num_ds_frames``     = floor(num_frames / 2) + 1         = 7
  (STC connector sampler: Conv3d kernel 2, stride 2, pad 1 over time)
- ``patch_grid``        = image_size / patch_size           = 24
- ``ds_grid``           = floor(patch_grid / 2) + 1         = 13
- ``tokens_per_frame``  = ds_grid**2                        = 169
- ``num_vis_tokens``    = num_ds_frames * tokens_per_frame  = 1183
- ``max_lang_tokens``   = model_max_length - num_vis_tokens + 1 = 866
  (+1: the <video> modal token is consumed by the splice,
   extractfeatures.py:211-212)
- ``feature_len``       = num_vis_tokens + max_lang_tokens - 1 = 2048
  (the multimodal sequence length; litmodule.py:180-181 asserts this)
"""

from __future__ import annotations

import dataclasses
import math

__all__ = ["VLBGeometry", "REFERENCE_GEOMETRY"]

# Sentinel id for the <video> modal token in the tokenized text stream
# (extractfeatures.py:236; VideoLLaMA2 constant).
VIDEO_TOKEN_ID = -201


@dataclasses.dataclass(frozen=True)
class VLBGeometry:
    tr: float = 1.49                 # fMRI repetition time (s)
    frames_per_tr: int = 4
    window: int = 3                  # TRs of video per sample
    delay: int = 3                   # TRs between window end and target TR
    model_max_length: int = 2048     # LLM token budget (vision + text)
    image_size: int = 336
    patch_size: int = 14
    onsets_width: int = 64           # padded width of per-TR token onsets
    num_parcels: int = 1000          # brain readout targets

    # ---- derived ----
    @property
    def num_frames(self) -> int:
        return self.window * self.frames_per_tr

    @property
    def num_ds_frames(self) -> int:
        return math.floor(self.num_frames / 2) + 1

    @property
    def patch_grid(self) -> int:
        assert self.image_size % self.patch_size == 0
        return self.image_size // self.patch_size

    @property
    def ds_grid(self) -> int:
        return math.floor(self.patch_grid / 2) + 1

    @property
    def tokens_per_frame(self) -> int:
        return self.ds_grid**2

    @property
    def num_vis_tokens(self) -> int:
        return self.num_ds_frames * self.tokens_per_frame

    @property
    def max_lang_tokens(self) -> int:
        return self.model_max_length - self.num_vis_tokens + 1

    @property
    def feature_len(self) -> int:
        """Multimodal sequence length after the <video> splice."""
        return self.num_vis_tokens + self.max_lang_tokens - 1

    @property
    def window_offset(self) -> int:
        """TRs dropped from the head of the feature arrays (window - 1)."""
        return self.window - 1

    @property
    def bold_offset(self) -> int:
        """TRs dropped from the head of the BOLD timeseries."""
        return self.window_offset + self.delay

    @property
    def abs_tr_delay(self) -> float:
        """Window onset -> target-TR midpoint distance, in TRs (= 5.5)."""
        return self.bold_offset + 0.5

    def target_tr_onsets(self, n: int):
        """Target-TR midpoints (s, from episode onset) for n samples.

        Reference: lazyloading.py:99 (midpoint = onset + tr/2).
        """
        import numpy as np

        return (self.bold_offset + 0.5 + np.arange(n, dtype=np.float64)) * self.tr

    def vision_onset_deltas(self):
        """Time (s) from each downsampled frame to the target-TR midpoint.

        Reference: lazyloading.py:108-115 — ``num_ds_frames`` values stepping
        back ``window/(num_ds_frames-1)`` TRs from ``abs_tr_delay``.
        """
        import numpy as np

        step = self.window / (self.num_ds_frames - 1)
        return self.tr * (self.abs_tr_delay - step * np.arange(self.num_ds_frames))

    def validate(self) -> None:
        assert self.feature_len == self.model_max_length, (
            f"feature_len {self.feature_len} != model_max_length "
            f"{self.model_max_length}: pick model_max_length >= num_vis_tokens"
        )
        assert self.num_ds_frames >= 2
        assert self.max_lang_tokens > 0


REFERENCE_GEOMETRY = VLBGeometry()
REFERENCE_GEOMETRY.validate()
assert REFERENCE_GEOMETRY.num_vis_tokens == 1183
assert REFERENCE_GEOMETRY.max_lang_tokens == 866
assert REFERENCE_GEOMETRY.tokens_per_frame == 169
