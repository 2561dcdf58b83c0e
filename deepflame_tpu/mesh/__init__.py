from .structured import (StructuredMesh, BC, pad_field, fixed_value,
                         zero_gradient, cyclic, fixed_gradient, symmetry, empty)

__all__ = ["StructuredMesh", "BC", "pad_field", "fixed_value", "zero_gradient",
           "cyclic", "fixed_gradient", "symmetry", "empty"]
