"""shellcount-ray: a Ray-Data-native spatial-join + shell-count engine.

From-scratch reimplementation of the query capabilities of the SJCS
reference workload (ryumt/SpatialJoinCountOverShells) as grid-bucketed
distance joins over ``ray.data.Dataset`` pipelines, plus the generic
spatial surface (range join, kNN, point-in-polygon, tile assignment)
and large-scale training-data operators (dedup, ANN, text analysis).

See SURVEY.md for the structural analysis of the reference; citations in
docstrings (``reference src/...:line``) point into /root/reference.
"""

from spatialjoincountovershells_ray.config import BOX_SIZE, RadiusLadder, GridSpec

__all__ = ["BOX_SIZE", "RadiusLadder", "GridSpec"]
__version__ = "0.1.0"
