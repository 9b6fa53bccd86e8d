from .mesh import make_mesh, init_distributed, P, NamedSharding
from .shard import shard_quantum_graph, unstack_shard, shard_bounds
from .api import make_sharded_eval_step, make_sharded_train_step
