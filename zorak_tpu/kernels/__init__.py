from .stft import stft, istft, stft_process
from .convolution import fir_conv, partitioned_convolve
