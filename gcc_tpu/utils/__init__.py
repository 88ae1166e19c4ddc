from gcc_tpu.utils.schedule import lr_for_epoch  # noqa: F401
from gcc_tpu.utils.best_info import BestInfo  # noqa: F401
from gcc_tpu.utils.image_pool import ImagePool  # noqa: F401
from gcc_tpu.utils.logging import get_logger  # noqa: F401
