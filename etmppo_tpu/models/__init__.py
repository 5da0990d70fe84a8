from .actor_critic import ActorCriticModel
from .transformer import Transformer, TransformerBlock, MultiHeadAttention, \
    GRUGate, sinusoidal_position_table
