from .rmsnorm import rmsnorm
from .rope import rope_cache, apply_rope
from .linear import linear
from .attention import attention_dense
from .sampling import sample_greedy, sample_token
