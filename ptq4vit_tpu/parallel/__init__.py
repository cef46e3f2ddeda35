from .mesh import (Evaluator, make_mesh, replicate, shard_batch,
                   shard_params, test_classification)
from .serve import ServingEngine
