from .mesh import make_mesh, replicated, dp_spec
from .sharding import transformer_tp_rules, shard_params
from .pipeline import pipeline_apply, pipeline_backbone
