from smqtk_indexing_tpu.data.data_element import (  # noqa: F401
    DataElement,
    DataFileElement,
    DataMemoryElement,
    from_uri,
)
from smqtk_indexing_tpu.data.descriptor import (  # noqa: F401
    DescriptorElement,
    DescriptorMemoryElement,
    DescriptorSet,
    MemoryDescriptorSet,
)
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError  # noqa: F401
from smqtk_indexing_tpu.data.key_value import (  # noqa: F401
    KeyValueStore,
    MemoryKeyValueStore,
)
