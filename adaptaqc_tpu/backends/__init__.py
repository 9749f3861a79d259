from . import center_mps, mps_core, sv_core

__all__ = ["center_mps", "mps_core", "sv_core"]
