from ccst_tpu.data.lists import (
    parse_list,
    write_list,
    stylized_output_path,
    generate_k_lists,
    train_list_path,
    test_list_path,
)
from ccst_tpu.data.loader import ImageBatchLoader, load_image
