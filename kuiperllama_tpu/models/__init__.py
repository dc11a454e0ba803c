from . import decoder, paged
