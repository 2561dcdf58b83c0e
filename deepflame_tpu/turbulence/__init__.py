from .les import (LESModel, smagorinsky, wale, sigma_model,
                  dynamic_smagorinsky)

__all__ = ["LESModel", "smagorinsky", "wale", "sigma_model",
           "dynamic_smagorinsky"]
