from traject_spark.translation_maps.builtin import BUILTIN_MAPS

__all__ = ["BUILTIN_MAPS"]
