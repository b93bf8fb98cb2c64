from .gaussians import GaussianParams, create_from_points
