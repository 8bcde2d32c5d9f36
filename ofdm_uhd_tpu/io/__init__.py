from .capture import (CaptureReader, CaptureWriter, read_capture,
                      write_capture, SyntheticSource)

__all__ = ["CaptureReader", "CaptureWriter", "read_capture", "write_capture",
           "SyntheticSource"]
