from .functional import fake_quant, lsq

__all__ = ["fake_quant", "lsq"]
