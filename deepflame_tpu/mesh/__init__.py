from .structured import (StructuredMesh, BC, pad_field, fixed_value,
                         zero_gradient, cyclic, fixed_gradient, symmetry, empty)
from .energy_bcs import (fixed_energy, gradient_energy, mixed_energy,
                         resolve_energy_bcs)
from .geometry import GeneralMesh, build_general_mesh
from .blockmesh import read_blockmesh, build_blockmesh, parse_blockmesh_dict
from .polymesh import read_polymesh, write_polymesh

__all__ = ["StructuredMesh", "BC", "pad_field", "fixed_value", "zero_gradient",
           "cyclic", "fixed_gradient", "symmetry", "empty",
           "fixed_energy", "gradient_energy", "mixed_energy",
           "resolve_energy_bcs", "GeneralMesh", "build_general_mesh",
           "read_blockmesh", "build_blockmesh", "parse_blockmesh_dict",
           "read_polymesh", "write_polymesh"]
