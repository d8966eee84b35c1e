from .pattern import (Pattern, LayoutCoord, CodebooksPatternProvider,
                      DelayedPatternProvider, ParallelPatternProvider,
                      UnrolledPatternProvider, CoarseFirstPattern,
                      MusicLMPattern, get_pattern_provider)
