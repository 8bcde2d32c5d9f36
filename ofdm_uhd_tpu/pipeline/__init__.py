from .tx import TxPipeline
from .rx import RxPipeline

__all__ = ["TxPipeline", "RxPipeline"]
