from .softpatch import SoftPatchConfig, fit_memory_bank, score_windows, softpatch_scores

__all__ = ["SoftPatchConfig", "fit_memory_bank", "score_windows", "softpatch_scores"]
