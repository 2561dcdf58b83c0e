from .les import (LESModel, smagorinsky, wale, sigma_model,
                  dynamic_smagorinsky)
from .ras import KEpsilon, KOmegaSST, wall_distance
from .wall_functions import WallFunctions

__all__ = ["LESModel", "smagorinsky", "wale", "sigma_model",
           "dynamic_smagorinsky", "KEpsilon", "KOmegaSST", "wall_distance",
           "WallFunctions"]
