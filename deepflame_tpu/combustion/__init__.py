from .basic import CombustionModel, Laminar, NoCombustion
from .edc import EDC
from .pasr import PaSR

__all__ = ["CombustionModel", "Laminar", "NoCombustion", "EDC", "PaSR"]
