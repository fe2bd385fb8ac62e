from .functional import fake_quant, fake_quant_traced, lsq

__all__ = ["fake_quant", "fake_quant_traced", "lsq"]
