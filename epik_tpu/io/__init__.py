from .db import PhyloKmerDB, load, save
from .fasta import batch_fasta, read_fasta
from .jplace import jplace_writer
