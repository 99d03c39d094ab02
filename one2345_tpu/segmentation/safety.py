"""Safety checker — CLIP-embedding concept filter.

Parity target: StableDiffusionSafetyChecker as used in init_model
(utils/zero123_utils.py:49-55) and nsfw_check (demo/app.py:376-386): cosine
similarity of the CLIP image embedding against learned concept embeddings,
with all thresholds scaled by 1.2 to reduce false positives.

The checker's learned concept embeddings ship inside the HF checkpoint
(CompVis/stable-diffusion-safety-checker); `convert_safety_checker` maps
them in.  Without weights the checker is a configurable no-op (flagging
nothing) — the architecture + thresholds are what the pipeline contracts on.
"""

from __future__ import annotations

import numpy as np


class SafetyChecker:
    def __init__(
        self,
        concept_embeds: np.ndarray | None = None,  # [C, 768]
        concept_thresholds: np.ndarray | None = None,  # [C]
        special_embeds: np.ndarray | None = None,  # [S, 768]
        special_thresholds: np.ndarray | None = None,  # [S]
        threshold_scale: float = 1.2,  # zero123_utils.py:54-55
    ):
        self.concept_embeds = concept_embeds
        self.concept_thresholds = (
            None if concept_thresholds is None else concept_thresholds * threshold_scale
        )
        self.special_embeds = special_embeds
        self.special_thresholds = (
            None if special_thresholds is None else special_thresholds * threshold_scale
        )

    @property
    def has_weights(self) -> bool:
        return self.concept_embeds is not None

    def check(self, image_embeds: np.ndarray) -> np.ndarray:
        """[B, 768] CLIP image embeddings -> [B] bool flagged."""
        if not self.has_weights:
            return np.zeros(image_embeds.shape[0], bool)

        def cos(a, b):
            a = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
            b = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
            return a @ b.T

        sim = cos(image_embeds, self.concept_embeds)  # [B, C]
        flagged = (sim > self.concept_thresholds[None]).any(axis=1)
        if self.special_embeds is not None:
            s = cos(image_embeds, self.special_embeds)
            # special concepts lower the effective threshold (HF semantics
            # approximated: any special hit flags conservatively)
            flagged |= (s > self.special_thresholds[None]).any(axis=1)
        return flagged


def convert_safety_checker(sd) -> SafetyChecker:
    """Build from an HF safety-checker state dict."""
    from one2345_tpu.utils.convert_weights import _np

    return SafetyChecker(
        concept_embeds=_np(sd["concept_embeds"]),
        concept_thresholds=_np(sd["concept_embeds_weights"]),
        special_embeds=_np(sd["special_care_embeds"]),
        special_thresholds=_np(sd["special_care_embeds_weights"]),
    )
