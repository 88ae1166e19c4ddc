"""Model registry: opt.model string -> engine class (models/__init__.py:3-15)."""

from __future__ import annotations


def get_engine_class(model_name: str):
    if "pix2pix" in model_name:
        from gcc_tpu.engines.pix2pix import Pix2PixEngine
        return Pix2PixEngine
    if "cyclegan" in model_name:
        from gcc_tpu.engines.cyclegan import CycleGANEngine
        return CycleGANEngine
    if model_name == "sagan":
        from gcc_tpu.engines.sagan import SAGANEngine
        return SAGANEngine
    if model_name == "srgan":
        from gcc_tpu.engines.srgan import SRGANEngine
        return SRGANEngine
    raise NotImplementedError(f"unknown model [{model_name}]")
