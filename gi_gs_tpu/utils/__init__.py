from . import math_utils, image_utils
