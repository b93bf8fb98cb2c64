from .cameras import Camera, make_camera
