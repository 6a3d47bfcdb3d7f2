from .alphabet import AMINO, DNA, Alphabet, get_alphabet
from .kmers import BatchTokens, ReadKmers, tokenize_batch, tokenize_read
from .scoring import log10_score_threshold, score_threshold
from .tree import PhyloNode, PhyloTree, parse_newick, to_newick
