"""python -m ed_fi_x_tpdm_data_ingestion_poc_spark <application.properties>"""

import sys

from .app import main

sys.exit(main())
