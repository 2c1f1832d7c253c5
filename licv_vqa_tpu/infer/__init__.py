from .decode import beam_generate, greedy_generate
from .speculative import speculative_greedy_generate

__all__ = ["beam_generate", "greedy_generate", "speculative_greedy_generate"]
