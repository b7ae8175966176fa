"""unmixing_ray — a Ray-Data-native spatial-join + tiling + spectral-
unmixing engine with the data-processing capabilities of arthur-e/unmixing,
re-architected for web scale. See SURVEY.md for the blueprint."""

__version__ = "0.1.0"
