from radmmm_tpu.text.processing import TextProcessing
from radmmm_tpu.text.symbols import get_symbols
