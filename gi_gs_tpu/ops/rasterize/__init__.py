from .config import RasterConfig
from .pipeline import rasterize, RasterOutput
