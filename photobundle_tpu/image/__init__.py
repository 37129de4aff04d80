from . import interp, pyramid, patches, saliency, descriptor
