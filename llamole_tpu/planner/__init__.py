from .search import retro_star_search, molstar
from .route import SynthesisRoute
