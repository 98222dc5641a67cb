from .hashing import stable_hash_bytes, stable_hash_str
from .native import load_native
from .pool import Lease, LeasePool
