"""IG-VLM: video QA via image grids.

Re-implementation of the vendored IG-VLM fork (reference: IG-VLM/): a video
is sampled to a fixed number of frames, composed into a near-square grid
collage, and answered by the single-image VLM; scoring is exact multiple
choice or an (optional, API-gated) GPT judge.
"""

from .grid import create_grid_view, extract_frames  # noqa: F401
from .pipeline import LlavaPipeline  # noqa: F401
