"""Earth-model geometry and camera models."""

from .earth import EarthModel, DEGREE_DISTANCE, EARTH_R, WGS84_A, WGS84_B

__all__ = ["EarthModel", "DEGREE_DISTANCE", "EARTH_R", "WGS84_A", "WGS84_B"]
