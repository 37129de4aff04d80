from . import se3, camera
from .camera import Camera
