from .orb_extractor import FrameFeatures, extract_orb
