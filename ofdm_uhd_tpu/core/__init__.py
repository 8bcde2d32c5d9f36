from .spec import WaveformSpec, MOD_BITS, ChannelSpec

__all__ = ["WaveformSpec", "MOD_BITS", "ChannelSpec"]
