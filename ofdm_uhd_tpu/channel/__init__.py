from .models import apply_channel, awgn, multipath, cfo_shift, phase_noise, make_capture

__all__ = ["apply_channel", "awgn", "multipath", "cfo_shift", "phase_noise", "make_capture"]
