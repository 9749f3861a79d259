from . import mps_core, sv_core

__all__ = ["mps_core", "sv_core"]
