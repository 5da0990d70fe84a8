from .core import JaxEnv
from .cartpole import CartPole
from .poc_memory import PocMemoryEnv
from .factory import create_env
