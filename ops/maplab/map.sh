#!/bin/bash
# Container entrypoint: run Rovioli VIO over the bag, optimize with the
# maplab console, export the trajectory csv, and convert to an autolabel
# scene.
set -e

ROSBAG=/home/maplab_user/bag.bag
MAP_FOLDER=/tmp/maps/map
SENSOR_CALIBRATION=/home/maplab_user/sensors.yaml

bash "$HOME/run_rovioli.sh"

source "$HOME/ws/devel/setup.bash"
rosrun maplab_console maplab_console \
	--batch_control_file "$HOME/maplab_console_script.yaml"

python3 "$HOME/convert_to_autolabel.py" \
	--bag "$ROSBAG" \
	--export /tmp/maps/csv_export/vertices.csv \
	--sensors "$SENSOR_CALIBRATION" \
	--out /home/maplab_user/out_scene
