from . import timer, logging
from .timer import Timer, time_code
