from . import state, residuals, schur, lm, tracking, selection, engine
from .engine import PhotometricBundleAdjustment, WindowResult
