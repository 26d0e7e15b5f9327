from geotables_jl_spark.plans.checkpoint import Checkpointer

__all__ = ["Checkpointer"]
