from .decode import beam_generate, greedy_generate
from .serving import Request, ServingEngine
from .speculative import speculative_greedy_generate

__all__ = [
    "beam_generate",
    "greedy_generate",
    "speculative_greedy_generate",
    "Request",
    "ServingEngine",
]
