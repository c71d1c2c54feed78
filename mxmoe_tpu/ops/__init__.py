from . import dispatch, gmm
