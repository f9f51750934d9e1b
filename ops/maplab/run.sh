#!/bin/bash
# Run the maplab mapping container.
#   ./run.sh map <sensors.yaml> <bag.bag> <out-scene>   run the pipeline
#   ./run.sh shell <sensors.yaml> <data-dir> <out-scene> debugging shell
set -e

absolute_path() {
	echo "$(readlink -m $1)"
}

USAGE="Usage: ./run.sh <command>"
USAGE+="\nmap <sensors.yaml> <bag.bag> <out-scene>"
USAGE+="\nshell <sensors.yaml> <data-dir> <out-scene>"
command="$1"

sensor_file="$(absolute_path $2)"
out_scene="$4"

if [ -z "$sensor_file" ] || [ -z "$3" ] || [ -z "$out_scene" ]; then
	echo -e "$USAGE"
	exit 1
fi
mkdir -p "$out_scene"

common_args=(
	--privileged --network=host
	-v "$sensor_file":/home/maplab_user/sensors.yaml
	-v "$(absolute_path $out_scene)":/home/maplab_user/out_scene
	-e QT_X11_NO_MITSHM=1
	-v /tmp/.X11-unix:/tmp/.X11-unix:rw
)

if [ "$command" == "shell" ]; then
	xhost +local:root || true
	docker run -it "${common_args[@]}" \
		-v "$(absolute_path $3)":/home/maplab_user/data \
		--entrypoint /bin/bash maplab
elif [ "$command" == "map" ]; then
	xhost +local:root || true
	docker run -it "${common_args[@]}" \
		-v "$(absolute_path $3)":/home/maplab_user/bag.bag \
		maplab
else
	echo "Command '$command' not recognized. Try map or shell."
	exit 1
fi
